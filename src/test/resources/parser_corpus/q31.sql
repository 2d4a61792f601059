-- comment line
SELECT b
FROM people, t
