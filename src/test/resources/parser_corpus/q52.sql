-- comment line
SELECT population, capital AS x_y
FROM t AS t1
