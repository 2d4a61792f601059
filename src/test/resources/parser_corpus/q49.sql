-- comment line
SELECT name AS b, a, cities.population, countries.name
FROM t, cities, cities
WHERE 2147483647 > 2147483647 AND "Japan" = t1 AND 42 < name
