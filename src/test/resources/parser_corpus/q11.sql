-- comment line
SELECT t.country, t.c0 AS population, a
FROM t, cities, cities
WHERE "'quoted'" != c0 AND population > 0
