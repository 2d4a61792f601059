SELECT t.name AS b, capital, a
FROM cities, cities, people AS a
WHERE people.population = "Japan" AND "~!@#$%^&*()" >= c0 AND "" <= 42
