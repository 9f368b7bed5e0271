import multiprocessing as mp, time, hashlib

def work(n):
    h = b"s"
    for i in range(n):
        h = hashlib.md5(h + str(i).encode()).digest()
    return h[0]

def steal():
    with open("/proc/stat") as f: v=[int(x) for x in f.readline().split()[1:]]
    return v[7], sum(v)

for procs in (4, 8, 16, 24, 32):
    s0,t0 = steal(); t=time.time()
    with mp.Pool(procs) as p:
        p.map(work, [300_000]*procs*6, chunksize=1)
    w=time.time()-t; s1,t1=steal()
    rate = procs*6*300_000/w/1e6
    print(f"procs={procs} rate={rate:.1f}M/s per_proc={rate/procs:.2f}M/s steal={100*(s1-s0)/max(t1-t0,1):.1f}%")

# Finding (2026-08-16): steal on this VM is a FUNCTION OF OUR OWN LOAD —
# 0.1% at 4 procs rising monotonically to 12.6% at 32 procs with nothing
# else running (hypervisor CPU cap / contended physical host). Per-proc
# throughput: 1.41 M/s at 4 procs -> 1.09 at 16 -> 0.93 at 32. The host's
# own 4->16 scaling ceiling INCLUDING self-induced steal is therefore
# 17.4/(4*5.6) = 0.777 — no engine can exceed it here. This is why the
# 16-core Spark runs "attract" steal while 4-core runs measure clean.
