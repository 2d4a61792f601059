SELECT x_y
FROM t AS a, t, cities
WHERE "~!@#$%^&*()" < capital AND 42 = t1  -- trailing
