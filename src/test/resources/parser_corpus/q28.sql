SELECT a, people.c0, cities.population, population
FROM cities AS population
