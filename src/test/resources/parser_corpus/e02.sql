SELECT a FROM t WHERE a = "unterminated
