"""Plan tier: Flink-SQL dialect translation + plan-shape inspection
(reference: flink-sql-parser grammar extensions; plan tests via
TableTestBase golden XML, SURVEY §5.1)."""
