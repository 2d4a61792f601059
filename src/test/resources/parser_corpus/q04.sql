SELECT countries.capital, countries.b AS capital, country, cities.c0
FROM cities AS population, t
WHERE cities.t1 > "Japan" AND "" <= t1
