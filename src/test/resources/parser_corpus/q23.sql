SELECT x_y, name, b, t.a AS c0
FROM t, countries AS capital
WHERE t1 <= capital AND people.c0 >= "'quoted'"
