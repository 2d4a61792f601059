SELECT countries.capital, people.country, people.a
FROM t, countries
