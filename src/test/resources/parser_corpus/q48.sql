SELECT countries.name, t.population, t.name
FROM countries, countries AS name, cities
WHERE "~!@#$%^&*()" != cities.b AND 42 = 42  -- trailing
