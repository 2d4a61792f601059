SELECT cities.c0, country
FROM countries AS name
WHERE c0 <= cities.c0 AND 2147483647 <= x_y AND 0 >= t.a
