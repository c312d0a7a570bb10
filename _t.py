import numpy as np, jax, jax.numpy as jnp, time
from rapidraw_tpu.ops.blur import gaussian_blur, gaussian_blur_reference
rng=np.random.default_rng(0)
img=jnp.asarray(rng.random((3,200,300),dtype=np.float32))
for r in (4,31,152):
    a=np.asarray(jax.jit(gaussian_blur, static_argnums=1)(img,r))
    b=np.asarray(jax.jit(gaussian_blur_reference, static_argnums=1)(img,r))
    print(f'HIGH r={r}: maxdiff vs conv = {np.abs(a-b).max():.2e}')
big=jnp.asarray(rng.random((3,4096,6144),dtype=np.float32))
def slope(f, x, it=6):
    y=f(x); _=float(y.reshape(-1)[0])
    def run(k):
        t0=time.perf_counter(); y=x
        for _ in range(k): y=f(y)
        _=float(y.reshape(-1)[0]); return time.perf_counter()-t0
    return (run(it+2)-run(2))/it
for r in (14,152):
    print(f'blur r={r}:', round(slope(jax.jit(lambda x: gaussian_blur(x,r)), big)*1e3,1),'ms')
# curves after static specialization
from rapidraw_tpu.params.parse import parse_adjustments
from rapidraw_tpu.pipeline.develop import develop
doc={'curves':{'luma':[{'x':0,'y':4},{'x':110,'y':96},{'x':255,'y':252}],'red':[{'x':0,'y':0},{'x':255,'y':255}],'green':[{'x':0,'y':0},{'x':255,'y':255}],'blue':[{'x':0,'y':0},{'x':255,'y':255}]}}
p,c=parse_adjustments(doc)
print('rgb_maybe_active:', c.rgb_curves_maybe_active, 'segments:', c.curve_segments)
f=jax.jit(lambda x: develop(x,p,c))
print('curves stage total:', round(slope(f,big)*1e3,1),'ms')
p0,c0=parse_adjustments({})
f0=jax.jit(lambda x: develop(x,p0,c0))
print('empty total:', round(slope(f0,big)*1e3,1),'ms')
