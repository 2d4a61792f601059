SELECT t.capital, t.c0, x_y
FROM t, t
WHERE countries.capital < country AND a != cities.a
