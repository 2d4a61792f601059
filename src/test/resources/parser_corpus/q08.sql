SELECT cities.name, country, population, c0
FROM people AS country, cities AS population  -- trailing
