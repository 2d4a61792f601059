SELECT a
FROM countries AS x_y, cities AS x_y, countries
WHERE capital >= "~!@#$%^&*()" AND "" > c0
