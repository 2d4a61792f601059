-- comment line
SELECT countries.population AS name, capital AS name, people.b AS country, t.x_y
FROM people AS capital
WHERE 2147483647 >= "~!@#$%^&*()"
