SELECT t1
FROM cities, people, people
