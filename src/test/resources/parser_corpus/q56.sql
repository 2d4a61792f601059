SELECT people.capital
FROM countries, t AS x_y, cities
WHERE "'quoted'" < cities.a AND 0 = countries.x_y  -- trailing
