SELECT people.x_y
FROM people
WHERE population <= "'quoted'"
