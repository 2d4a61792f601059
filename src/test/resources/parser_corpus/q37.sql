SELECT x_y
FROM cities
WHERE "Japan" < cities.b
