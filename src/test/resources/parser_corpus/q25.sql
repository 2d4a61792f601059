SELECT countries.b, capital
FROM t, countries
WHERE capital < "x y z" AND name < people.country AND 2147483647 <= b  -- trailing
