SELECT capital
FROM t
WHERE capital < "Japan" AND "'quoted'" <= 0
