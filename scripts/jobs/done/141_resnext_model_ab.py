"""Job 141 (round 5): ResNeXt-50 MODEL-LEVEL A/B for the grouped-conv
dispatch (VERDICT r4 #2 'Done' gate).

Arms (bench.py methodology: 3 windows, middle, fetch-closed):
  train: CONVNET_TPU_GROUPED=fgc  vs  auto (tiled-dense at (56,128,1),
         the only shape the dispatch table enables — jobs 105/134).
  eval:  impl=xla vs impl=pallas (Pallas dense-tile kernel at the
         stage-1 shape only — job 140: fwd 1.26x there, loses
         elsewhere/with-bwd).
"""
import os
import sys
import time as _t

B = 256


def purge():
    for k in list(sys.modules):
        if k.startswith("convnet_tpu"):
            del sys.modules[k]


def build(mode):
    os.environ["CONVNET_TPU_GROUPED"] = mode
    purge()
    from convnet_tpu import models
    from convnet_tpu.regimes.optim import OptimRegime
    from convnet_tpu.train.trainer import Trainer, TrainerConfig
    m = models.build("resnext", depth=50)
    tr = Trainer(m, OptimRegime(m.regime), 1000,
                 TrainerConfig(dtype="bf16", print_freq=0))
    p, s = m.init(jax.random.PRNGKey(0), tr.policy)
    p, s, o = tr.initialize(p, s)
    return m, tr, p, s, o


def bench_train(mode, steps=8):
    m, tr, p, s, o = build(mode)
    x = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
    y = jnp.zeros((B,), jnp.int32)
    tr.optim.update(0, 0)
    hp = tr._hp_device(tr.optim.hyperparams())
    step = tr._get_train_step()
    r = jax.random.PRNGKey(1)
    p, s, o, mm = step(p, s, o, x, y, hp, r)
    fetch1(mm["loss"])
    for _ in range(3):
        p, s, o, mm = step(p, s, o, x, y, hp, r)
    fetch1(mm["loss"])
    ws = []
    for _ in range(3):
        t0 = _t.perf_counter()
        for _ in range(steps):
            p, s, o, mm = step(p, s, o, x, y, hp, r)
        fetch1(mm["loss"])
        ws.append((_t.perf_counter() - t0) / steps * 1e3)
    del m, tr, p, s, o
    return sorted(ws)[1]


def bench_eval(impl, steps=20):
    os.environ["CONVNET_TPU_GROUPED"] = "fgc"   # isolate the layer route
    purge()
    from convnet_tpu import models
    from convnet_tpu.core.module import apply_module
    from convnet_tpu.core.dtypes import make_policy
    m = models.build("resnext", depth=50)
    pol = make_policy("bf16")
    p, s = m.init(jax.random.PRNGKey(0), pol)
    x = jnp.ones((B, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def fwd(p, s, x):
        y, _ = apply_module(m, p, s, x, train=False, policy=pol, impl=impl)
        return y

    y = fwd(p, s, x)
    first = fetch1(y)
    fetch1(fwd(p, s, x))
    ws = []
    for _ in range(3):
        t0 = _t.perf_counter()
        for _ in range(steps):
            y = fwd(p, s, x)
        fetch1(y)
        ws.append((_t.perf_counter() - t0) / steps * 1e3)
    del m, p, s
    return sorted(ws)[1], first


t_fgc = bench_train("fgc")
t_auto = bench_train("auto")
log(f"TRAIN RN-X50 B256@224: fgc {t_fgc:.1f} ms | auto(tiled@56) "
    f"{t_auto:.1f} ms ({t_fgc/t_auto:.3f}x) | "
    f"{B/t_auto*1e3:,.0f} img/s")

e_xla, l_xla = bench_eval("xla")
e_pal, l_pal = bench_eval("pallas")
log(f"EVAL  RN-X50 B256@224: xla {e_xla:.1f} ms | pallas(stage1) "
    f"{e_pal:.1f} ms ({e_xla/e_pal:.3f}x) | logits[0] xla {l_xla:.4f} "
    f"pallas {l_pal:.4f}")
