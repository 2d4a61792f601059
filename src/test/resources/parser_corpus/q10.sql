-- comment line
SELECT t1, t.capital AS c0
FROM people, countries, people
WHERE countries.country < "" AND "Japan" != "x y z" AND "Japan" <= "Japan"  -- trailing
