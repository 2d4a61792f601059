SELECT c0, population, x_y
FROM t, t AS a
WHERE b > people.name AND "" != b
