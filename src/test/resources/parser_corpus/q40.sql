SELECT countries.b, name, a
FROM t
WHERE 42 > "x y z"
