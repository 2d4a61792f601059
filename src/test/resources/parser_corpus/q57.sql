SELECT capital AS t1, people.x_y AS t1
FROM t, people AS name, cities AS population
WHERE 2147483647 < "~!@#$%^&*()"
