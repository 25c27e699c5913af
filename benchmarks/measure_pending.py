"""Round-3 late measurement battery. Run on an IDLE host with the tunnel up.
Order: chain A/B -> bench.py context -> 4K A/B. One process per phase keeps
compile caches honest per comparison."""
import os, subprocess, sys, time

def run(tag, code, timeout):
    print(f"=== {tag} ===", flush=True)
    t0 = time.time()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, POLYCHASE_REPO=repo)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout, cwd=repo, env=env)
    print(r.stdout[-3000:])
    if r.returncode != 0:
        print("STDERR:", r.stderr[-2000:])
    print(f"({time.time()-t0:.0f}s)", flush=True)

AB_CHAIN = '''
import os, sys, time, tempfile
sys.path.insert(0, os.environ.get("POLYCHASE_REPO", "."))
import importlib
bench = importlib.import_module("bench")
frames = bench.make_clip()
from polychase_tpu.engine.opticalflow import VideoInfo, generate_optical_flow_database
info = VideoInfo(bench.W, bench.H, 0, len(frames))
def run():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "flow.db"); t0 = time.perf_counter()
        generate_optical_flow_database(info, lambda fid: frames[fid], None, p)
        return time.perf_counter() - t0
os.environ["POLYCHASE_LK_CHAIN"] = "1"; run()
os.environ["POLYCHASE_LK_CHAIN"] = "0"; run()
a, b = [], []
for i in range(5):
    os.environ["POLYCHASE_LK_CHAIN"] = "1"; a.append(run())
    os.environ["POLYCHASE_LK_CHAIN"] = "0"; b.append(run())
print("chain=1:", [round(x,3) for x in a], "min", round(min(a),3), "fps", round(12/min(a),2))
print("chain=0:", [round(x,3) for x in b], "min", round(min(b),3), "fps", round(12/min(b),2))
'''

AB_4K = '''
import os, sys, time, tempfile
sys.path.insert(0, os.environ.get("POLYCHASE_REPO", "."))
import numpy as np, cv2
from polychase_tpu.engine.opticalflow import VideoInfo, generate_optical_flow_database
W4, H4, NF = 3840, 2160, 6
rng = np.random.default_rng(3)
big = rng.integers(0, 255, (H4 + 40, W4 + 60)).astype(np.float32)
big = cv2.GaussianBlur(big, (0, 0), 1.5)
big = (255 * (big - big.min()) / np.ptp(big)).astype(np.uint8)
frames = [np.ascontiguousarray(big[3*t:3*t+H4, 5*t:5*t+W4]) for t in range(NF)]
info = VideoInfo(W4, H4, 0, NF)
def run():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "flow.db"); t0 = time.perf_counter()
        generate_optical_flow_database(info, lambda fid: frames[fid], None, p)
        return time.perf_counter() - t0
os.environ["POLYCHASE_LK_CHAIN"] = "1"; run()
os.environ["POLYCHASE_LK_CHAIN"] = "0"; run()
a, b = [], []
for i in range(3):
    os.environ["POLYCHASE_LK_CHAIN"] = "1"; a.append(run())
    os.environ["POLYCHASE_LK_CHAIN"] = "0"; b.append(run())
print("4k chain=1:", [round(x,2) for x in a], "min", round(min(a),2), "fps", round(NF/min(a),3))
print("4k chain=0:", [round(x,2) for x in b], "min", round(min(b),2), "fps", round(NF/min(b),3))
'''

run("chain A/B 640p", AB_CHAIN, 2400)
run("bench.py", "import os,subprocess,sys; subprocess.run([sys.executable,'bench.py'],cwd=os.environ['POLYCHASE_REPO'])", 1800)
run("chain A/B 4K", AB_4K, 3600)
