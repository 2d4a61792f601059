SELECT country
FROM t
WHERE "'quoted'" <= countries.country AND a > cities.b
