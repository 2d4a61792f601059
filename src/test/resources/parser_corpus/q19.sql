SELECT cities.capital
FROM countries, people, t AS capital
WHERE t.a >= "'quoted'" AND countries.capital < "~!@#$%^&*()" AND name = "x y z"
