SELECT name
FROM countries AS x_y, people, cities
WHERE t.b = capital AND x_y >= t.b AND capital < "x y z"  -- trailing
