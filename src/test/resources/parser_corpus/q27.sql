SELECT cities.c0
FROM countries AS t1, cities
WHERE a > "'quoted'" AND "~!@#$%^&*()" <= population AND 42 < people.t1
