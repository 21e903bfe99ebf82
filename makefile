test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py 8

aot-tpu:
	python -m hvt.tools.aot_tpu

roofline:
	python -m hvt.tools.roofline

doctor:
	python -m hvt.tools.doctor

residuals:
	python -m hvt.tools.residuals --model resnet50

serve:
	python serve.py --machine configs/machines/local.yaml \
		--exp configs/pretrain/debug_synthetic.yaml --port 8000

loader-bench:
	python -m hvt.tools.loader_bench --threads 1,2,4

bench-hierarchy:
	python -m hvt.tools.bench_hierarchy --model resnet50 --variant flat
	python -m hvt.tools.bench_hierarchy --model resnet50 --variant multitask
	python -m hvt.tools.bench_hierarchy --model resnet50 --variant hxe
	python -m hvt.tools.bench_hierarchy --model swinv2_tiny --variant flat
	python -m hvt.tools.bench_hierarchy --model swinv2_tiny --variant multitask
	python -m hvt.tools.bench_hierarchy --model swinv2_tiny --variant hxe

input-bench:
	python -m hvt.tools.train_input_bench --regime host-bound
	python -m hvt.tools.train_input_bench --regime device-bound

serve-bench:
	python -m hvt.tools.serve_bench --machine configs/machines/local.yaml \
		--exp configs/pretrain/debug_synthetic.yaml --clients 8 --requests 10 --batch 8

ra-probe:
	python -m hvt.tools.ra_probe

export-artifact:
	python -m hvt.tools.export_serving --machine configs/machines/local.yaml \
		--exp configs/pretrain/debug_synthetic.yaml --output /tmp/hvt-artifact

verify-artifact:
	python -m hvt.tools.export_serving --verify /tmp/hvt-artifact

fmt:
	@command -v ruff >/dev/null 2>&1 && ruff format hvt tests *.py || echo "ruff not installed; skipping format"

lint:
	@command -v ruff >/dev/null 2>&1 && ruff check hvt tests *.py || python -m compileall -q hvt tests
