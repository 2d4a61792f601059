SELECT b AS t1, population
FROM countries, people
WHERE t.x_y = name AND country <= "'quoted'" AND population = 0
