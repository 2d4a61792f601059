SELECT cities.name AS t1, country
FROM countries AS b
WHERE a <= "x y z" AND "x y z" > countries.a AND "Japan" > cities.capital  -- trailing
