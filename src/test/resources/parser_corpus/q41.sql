SELECT t.name AS population, cities.t1, c0, countries.x_y
FROM t
WHERE "" <= capital AND a <= c0
