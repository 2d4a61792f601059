SELECT cities.t1
FROM countries, t AS t1, t AS capital
WHERE country > c0 AND name > c0 AND countries.capital >= 0
