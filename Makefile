# One-line verification / bench targets. ROUND picks the artifact suffix:
#   make selfcheck-report ROUND=4   -> SELFCHECK_r4.txt (hostile, sf0.01 + sf0.1)
#   make bench                      -> one JSON line on stdout (median-of-3/query)
#   make test                       -> full pytest suite
ROUND ?= 4

.PHONY: selfcheck-report bench test

selfcheck-report:
	{ echo "== hostile sf0.01 =="; \
	  python tools/selfcheck.py --hostile /root/testdata/sf0.01 2>&1 | grep -aE '^(PASS|FAIL|ROWS)|pass,'; \
	  echo "== hostile sf0.1 =="; \
	  python tools/selfcheck.py --hostile /root/testdata/sf0.1 2>&1 | grep -aE '^(PASS|FAIL|ROWS)|pass,'; \
	} | tee SELFCHECK_r$(ROUND).txt

bench:
	python bench.py

test:
	python -m pytest tests/ -q
