"""Grid-aware resource discovery (the reference derives memory/thread
allowances from Slurm/PBS/SGE when present — reference.rst:117-120)."""

from meryl_tpu import resources as rs


def test_slurm_mem_per_node():
    env = {"SLURM_MEM_PER_NODE": "4096"}
    assert rs.grid_memory_bytes(env) == 4096 << 20
    assert abs(rs.max_memory_gb(env) - (4096 << 20) * 0.9 / 1e9) < 1e-6


def test_slurm_mem_per_cpu_scales():
    env = {"SLURM_MEM_PER_CPU": "1024", "SLURM_CPUS_ON_NODE": "8"}
    assert rs.grid_memory_bytes(env) == (1024 << 20) * 8


def test_pbs_bytes():
    assert rs.grid_memory_bytes({"PBS_RESC_MEM": "2000000000"}) == 2000000000


def test_grid_threads_priority():
    assert rs.grid_threads({"SLURM_CPUS_ON_NODE": "16"}) == 16
    assert rs.grid_threads({"NSLOTS": "3"}) == 3
    assert rs.grid_threads({}) is None


def test_fallback_physical():
    # no grid vars: returns something sane from the machine
    gb = rs.max_memory_gb({})
    assert 0.25 <= gb < 10000
    assert rs.max_threads({}) >= 1


def test_plan_uses_discovered_memory(tmp_path):
    from meryl_tpu import counter
    fa = tmp_path / "r.fa"
    fa.write_text(">s\n" + "ACGT" * 300 + "\n")
    plan = counter.configure_counting([str(fa)], 21)
    assert plan["memory_gb"] > 0  # discovered, not the old flat 8.0
