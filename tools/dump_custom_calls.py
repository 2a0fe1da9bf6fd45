import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
from celeste_jl_tpu.utils.config import enable_compile_cache
enable_compile_cache()
from __graft_entry__ import _synthetic_batch
from celeste_jl_tpu.vi.optimize import fit_sources
from celeste_jl_tpu.models.patches import SkyPatch

vp0s, patches = _synthetic_batch(n_sources=1024, tile=32, seed=1)
vp0s = jax.device_put(np.asarray(vp0s, dtype=np.float32))
patches = jax.tree.map(lambda x: jax.device_put(x), patches)
lowered = jax.jit(lambda v, p: fit_sources(v, p)).lower(vp0s, patches)
hlo = lowered.compile().as_text()
import re
calls = {}
for m in re.finditer(r'custom-call[^\n]*custom_call_target="([^"]+)"', hlo):
    calls[m.group(1)] = calls.get(m.group(1), 0) + 1
print("custom call targets:", calls)
for line in hlo.splitlines():
    if 'custom-call' in line and ('Eig' in line or 'eig' in line or 'qr' in line or '21' in line):
        print(line.strip()[:220])
