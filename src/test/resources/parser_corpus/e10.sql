SELECT a FROM t - b
