SELECT capital, x_y, population, population
FROM cities, cities
WHERE cities.c0 != "~!@#$%^&*()" AND country > capital AND "'quoted'" != ""
