SELECT cities.b, a
FROM t AS country, t AS population
WHERE "'quoted'" < t.population AND t.c0 = t1
