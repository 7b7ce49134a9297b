import os, time
import numpy as np
import jax
import mimikit_tpu as mmk
from benchmarks._timing import fence, read_rtt

io = mmk.IOSpec.mulaw_io(mmk.IOSpec.MuLawIOConfig(sr=16000, q_levels=256, mlp_dim=256))
net = mmk.SampleRNN.from_config(mmk.SampleRNN.Config(
    frame_sizes=(16, 8, 8), hidden_dim=256, io_spec=io))
net.seed(0)
B, n_steps = 256, 16384
prompts = (np.random.randint(0, 256, (B, 32)).astype(np.int32),)
net._ensure_params(prompts)
print("mode:", net._pallas_mode(B, 32, n_steps))
net._pallas_mode = lambda *a: "chunked"   # force
os.environ["MMK_PALLAS_DECODE"] = "1"
t0 = time.time()
out = net.generate(prompts, n_steps=n_steps, temperature=0.9)
fence(out[0]); print("compile+run:", round(time.time()-t0, 1), "s")
rtt = read_rtt(out[0])
t0 = time.time(); reps = 3
for i in range(reps):
    out = net.generate(prompts, n_steps=n_steps, temperature=0.9, rng=jax.random.PRNGKey(i))
    fence(out[0])
el = (time.time() - t0) / reps - rtt
print(f"chunked pallas B={B}: {B*n_steps/el:,.0f} samples/s ({el*1e6/n_steps:.2f} us/step)")
