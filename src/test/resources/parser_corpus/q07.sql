SELECT country
FROM countries AS name, countries, t
WHERE capital != "x y z" AND name > "~!@#$%^&*()" AND cities.b < cities.name
