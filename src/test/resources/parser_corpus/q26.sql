SELECT a
FROM countries, t
WHERE "x y z" = countries.a AND 42 = "'quoted'" AND x_y != countries.t1
