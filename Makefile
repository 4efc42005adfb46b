.PHONY: test oracle bench plans run evaluate

test:
	@python -m pytest tests/ -q

oracle:
	@python3 tools/oracle_check.py

bench:
	@python3 bench.py

plans:
	@python3 tools/plan_audit.py

run:
	@python3 -m beyond_vector_search_spark.cli run --query "INC-49217 details"

evaluate:
	@python3 -m beyond_vector_search_spark.cli evaluate
