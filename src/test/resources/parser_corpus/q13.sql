SELECT country, cities.t1 AS a, people.population, population AS a
FROM countries, people, countries AS country
WHERE countries.population <= 42 AND name > b
