-- comment line
SELECT t1, b AS country, t1 AS population, t1
FROM countries AS t1, cities, t
WHERE capital = x_y AND people.country = "x y z"  -- trailing
