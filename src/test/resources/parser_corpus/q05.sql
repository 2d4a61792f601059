SELECT t1, a, x_y AS b, countries.name
FROM cities AS name, people, people AS a
WHERE t1 > "Japan" AND a > x_y
