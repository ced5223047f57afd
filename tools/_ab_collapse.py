import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
import zyg_tpu
from zyg_tpu.scene import trimesh
print('platform', jax.devices()[0].platform, flush=True)
mesh = trimesh.make_trefoil_mesh(512, 480)
arena = trimesh.build_arena([mesh])
W = arena.node_rows.shape[0]; G = arena.tri_rows.shape[0]
print(f'nodes={W} groups={G}', flush=True)
N = 1<<20
def make_rays(coherent):
    rng = np.random.RandomState(0)
    if coherent:
        o = np.tile(np.array([[0.0,0.8,-14.0]],np.float32),(N,1))
        tgt = rng.uniform(-3,3,size=(N,3)).astype(np.float32)
    else:
        o = rng.uniform(-6,6,size=(N,3)).astype(np.float32)
        tgt = rng.uniform(-3,3,size=(N,3)).astype(np.float32)
    d = tgt-o; d/=np.linalg.norm(d,axis=-1,keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)
root = jnp.zeros(N, jnp.int32)
def timed(fn,*a):
    out = fn(*a); _=float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]*0))
    best=1e9
    for _i in range(3):
        t0=time.perf_counter(); out=fn(*a)
        _=float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]*0))
        best=min(best,time.perf_counter()-t0)
    return best,out
for label,coh in (('incoherent',False),('coherent',True)):
    o,d = make_rays(coh)
    full = jax.jit(lambda o,d: trimesh.traverse(arena, root, o, d, 1e-4, 1e9))
    t,hit = timed(full,o,d)
    hr = float(jnp.mean((hit.prim>=0).astype(jnp.float32)))
    print(f'[{label}] full: {t*1e3:8.2f} ms {N/t/1e6:6.2f} Mrays/s hit={hr:.3f}', flush=True)
    stage = jax.jit(lambda o,d: trimesh._traverse_stage(arena, root, o, d, 1e-4, 1e9, False, None)[0])
    t,hit = timed(stage,o,d)
    it=int(hit.iters)
    print(f'[{label}] stage: {t*1e3:8.2f} ms iters={it} ns/lane-iter={t/it/N*1e9:.2f}', flush=True)
