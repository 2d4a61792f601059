SELECT cities.capital
FROM t
WHERE name < 0 AND people.capital != b
