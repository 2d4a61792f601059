SELECT t1, cities.name AS name, t1
FROM t AS population, t
WHERE 2147483647 != people.x_y AND "" > countries.x_y
