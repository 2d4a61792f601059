SELECT t1, t.a, people.name AS t1, c0
FROM cities, cities, people AS a
WHERE capital >= countries.name
