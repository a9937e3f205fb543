"""Controlled scaling probe: fixed total work, N processes, no Spark.
Work item ~ the fused pipeline's character: regex + string ops + dict churn."""
import multiprocessing as mp, re, sys, time

TAG = re.compile(r"<[^>]+>")
WORD = re.compile(r"[A-Za-z0-9]+")

def work(seed: int) -> int:
    acc = 0
    html = ("<html><body>" + "".join(
        f"<h2>Section {i}</h2><p>The quick brown fox {i} jumps over the lazy dog near entity-{i%97}.</p>"
        for i in range(120)) + "</body></html>")
    for r in range(40):
        text = TAG.sub(" ", html)
        toks = WORD.findall(text)
        d = {}
        for t in toks:
            d[t.lower()] = d.get(t.lower(), 0) + 1
        acc += len(d) + (seed + r) % 7
    return acc

def main(nproc: int, ntasks: int) -> None:
    t0 = time.time()
    with mp.Pool(nproc) as p:
        res = p.map(work, range(ntasks), chunksize=max(1, ntasks // (nproc * 4)))
    dt = time.time() - t0
    print(f"nproc={nproc} tasks={ntasks} wall={dt:.2f}s tasks/s={ntasks/dt:.1f} tasks/s/core={ntasks/dt/nproc:.2f} checksum={sum(res)}")

if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
