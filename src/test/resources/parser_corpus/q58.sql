-- comment line
SELECT capital, x_y AS name, cities.x_y AS c0
FROM cities, countries, cities
WHERE "Japan" < b AND capital <= 0
