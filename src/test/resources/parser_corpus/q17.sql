SELECT t1 AS population, cities.a AS name, x_y, t1
FROM people AS c0, t, t
WHERE population != countries.country AND cities.population <= 42
