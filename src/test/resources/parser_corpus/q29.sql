SELECT c0 AS c0, c0, a
FROM cities AS a, t
WHERE population >= name AND "Japan" > c0 AND countries.capital != a
