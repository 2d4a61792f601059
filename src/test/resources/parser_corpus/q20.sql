SELECT t.country AS country
FROM people, people, t AS country
WHERE population = c0 AND t1 >= countries.country AND 0 > c0
