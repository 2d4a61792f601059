SELECT countries.population
FROM t
WHERE a = "x y z"
