import sys
sys.path.insert(0, "/root/repo")
sys.argv = ["bench.py", "5000", "2000", "8", "stencil", "dna2"]
import bench
# neighbor_update_every 20 -> 40: halves per-chunk noise-gen/far-check overhead
import __graft_entry__ as g
_orig = g._build_sim
def patched(*a, **k):
    k["neighbor_update_every"] = 40
    return _orig(*a, **k)
g._build_sim = patched
bench.main()
