SELECT people.capital, b, x_y AS capital
FROM cities
WHERE x_y > 42
