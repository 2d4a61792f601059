SELECT countries.t1
FROM t, t AS a, people
WHERE t1 != "'quoted'" AND 2147483647 >= "x y z" AND 42 > 0
