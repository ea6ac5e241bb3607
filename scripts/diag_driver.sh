#!/bin/bash
# Post-crash diagnosis sequence (runs/tpu_queue10/fullscale.log):
# probe-gated, each stage its own process. Stage h = worker health on a
# KNOWN-GOOD warm program (medium-scale single-shot value+grad); then
# bisect the fullscale crash (scripts/diag_fullscale_crash.py).
cd /root/repo || exit 1
L=runs/tpu_queue10
probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jax.jit(lambda a:(a*2).sum())(jnp.ones((256,256))).block_until_ready()" >/dev/null 2>&1; then
      return 0
    fi
    echo "[diag] relay wedged; attempt $i $(date +%T)" >> $L/diag.log
    sleep 120
  done
  return 1
}
step() {
  local name=$1 to=$2; shift 2
  probe || { echo "[diag] relay dead before $name $(date +%T)" >> $L/diag.log; return 1; }
  echo "[diag] start $name $(date +%T)" >> $L/diag.log
  timeout "$to" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "[diag] end $name rc=$rc $(date +%T)" >> $L/diag.log
  return $rc
}

step health 900 python - <<'EOF'
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from tpufwi.acquisition import Geometry
from tpufwi.grid import Grid
from tpufwi.propagators.acoustic2d import AcousticPropagator
from tpufwi.wavelets import ricker
ny, nz, nx = 100, 94, 200
grid = Grid(shape=(ny,nz,nx), h=(25.,)*3, pml=10, order=8)
dt = grid.cfl_dt(6000., 0.7); nt = 420
w = jnp.asarray(ricker(6., dt, nt), jnp.float32)
vp = jnp.full(grid.shape, 3500., jnp.float32)
rcv = np.array([[y,3,x] for y in range(10,90,10) for x in range(10,190,8)])
geom = Geometry.from_physical(grid, np.array([[50,2,100]]), rcv)
prop = AcousticPropagator(grid, dt, 6., 6000., impl="pallas3d")
t0=time.time()
@jax.jit
def vg(v,g,w_):
    return 0.5*jnp.sum(prop(v,g,w_)**2)
J, gr = jax.value_and_grad(vg)(vp, geom, w)
print(f"medium-scale vg {time.time()-t0:.0f}s J={float(J):.3e} |g|={float(jnp.linalg.norm(gr)):.3e}", flush=True)
print("HEALTH OK", flush=True)
EOF

step diag2 1500 python scripts/diag_fullscale_crash.py 2
step diag1 1500 python scripts/diag_fullscale_crash.py 1
step diag3 1500 python scripts/diag_fullscale_crash.py 3
echo "[diag] DONE $(date +%T)" >> $L/diag.log
