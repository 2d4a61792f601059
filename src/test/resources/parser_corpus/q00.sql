-- comment line
SELECT population, countries.c0, capital, t.capital
FROM countries, countries AS x_y
WHERE 0 = "'quoted'" AND 0 < population AND cities.b = 42
