SELECT x_y AS b, country, country, countries.t1
FROM countries, t AS country, cities
WHERE cities.country <= cities.name AND "'quoted'" != a
