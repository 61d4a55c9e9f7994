# One-line verification / bench targets. ROUND picks the artifact suffix:
#   make selfcheck-report ROUND=5   -> SELFCHECK_r5.txt (hostile, sf0.01 + sf0.1)
#   make bench                      -> one JSON line on stdout (median-of-3/query)
#   make test                       -> full pytest suite
#
# selfcheck-report is SELF-VALIDATING: the tool's parent process is the only
# stdout writer (worker Spark/DuckDB noise goes to per-worker logs under
# .selfcheck_cache/), every assigned query is guaranteed a printed line even
# if its worker dies, and check_selfcheck_artifact.py re-counts the tee'd
# FILE against each section's footer — the round-4 lost-lines defect fails
# the target instead of shipping.
ROUND ?= 5
WORKERS ?= 6

.PHONY: selfcheck-report bench test

selfcheck-report:
	{ echo "== hostile sf0.01 =="; \
	  python -u tools/selfcheck.py --hostile --workers=$(WORKERS) /root/testdata/sf0.01; \
	  echo "== hostile sf0.1 =="; \
	  python -u tools/selfcheck.py --hostile --workers=$(WORKERS) /root/testdata/sf0.1; \
	} | tee SELFCHECK_r$(ROUND).txt
	python tools/check_selfcheck_artifact.py SELFCHECK_r$(ROUND).txt

bench:
	python bench.py

test:
	python -m pytest tests/ -q
