SELECT population AS population
FROM t
WHERE people.x_y <= country AND 0 != "~!@#$%^&*()"
