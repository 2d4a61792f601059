SELECT country AS x_y, cities.t1, cities.t1 AS c0, country
FROM people AS c0, t, cities AS population
WHERE country < population AND country = "x y z"  -- trailing
