SELECT t.name, country
FROM cities AS b, cities
WHERE a <= countries.capital AND "Japan" > capital AND t1 < t1
