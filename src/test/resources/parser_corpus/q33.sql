-- comment line
SELECT x_y, cities.capital AS t1
FROM countries AS country
WHERE t.x_y <= people.a
