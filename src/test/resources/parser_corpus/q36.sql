SELECT population, people.x_y AS b, cities.c0 AS x_y, countries.country
FROM countries AS b
WHERE cities.population > b AND c0 != "'quoted'"  -- trailing
