"""Manual e2e driver: engine vs oracle on tiny fixtures (debug aid)."""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_fixtures import generate, write_parquet
from oracle import run_oracle

from sparkcrawl import schema as S
from sparkcrawl.engine import CrawlConfig, CrawlEngine
from sparkcrawl.filters import FilterConfig
from sparkcrawl.session import get_spark
from sparkcrawl.tables import SnapshotStore

size = sys.argv[1] if len(sys.argv) > 1 else "tiny"
max_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

fx = generate(size, seed=42)
paths = write_parquet(fx, f"/tmp/e2e_{size}/web")

print("oracle...")
o = run_oracle(fx, max_rounds=max_rounds)
print(f"oracle: rounds={o.rounds} seen={len(o.seen)} crawled={len(o.crawled)} trace={len(o.trace)}")

spark = get_spark("e2e", cores=4, shuffle_partitions=8)
store_dir = f"/tmp/e2e_{size}/store"
shutil.rmtree(store_dir, ignore_errors=True)
store = SnapshotStore(store_dir)

pages = spark.read.schema(S.PAGES).parquet(paths["pages"])
meta = spark.read.schema(S.PAGE_META).parquet(paths["page_meta"])
robots = spark.read.schema(S.ROBOTS).parquet(paths["robots"])
seeds = spark.read.schema(S.SEEDS).parquet(paths["seeds"])

cfg = CrawlConfig(filters=FilterConfig(banned_hosts=fx["banned_hosts"]))
eng = CrawlEngine(spark, store, pages, meta, robots, cfg)
res = eng.run(seeds, max_rounds=max_rounds)
print("engine:", res)

trace = store.read(spark, "trace", S.TRACE)
etrace = [
    (r["round"], r["ord"], r["url_norm"], r["host"], r["action"])
    for r in trace.orderBy("round", "ord").collect()
]
eseen = {r["url_norm"] for r in store.read(spark, "seen", S.SEEN).collect()}
ecrawled = {
    r["url_norm"]: (r["round"], r["text"])
    for r in store.read(spark, "crawled", S.CRAWLED).collect()
}

print(f"engine: seen={len(eseen)} crawled={len(ecrawled)} trace={len(etrace)}")

ok = True
if eseen != o.seen:
    ok = False
    print("SEEN MISMATCH")
    print(" only engine:", sorted(eseen - o.seen)[:10])
    print(" only oracle:", sorted(o.seen - eseen)[:10])
if etrace != o.trace:
    ok = False
    print("TRACE MISMATCH", len(etrace), len(o.trace))
    for a, b in zip(etrace, o.trace):
        if a != b:
            print(" engine:", a)
            print(" oracle:", b)
            break
if ecrawled != o.crawled:
    ok = False
    print("CRAWLED MISMATCH")
    for k in sorted(set(ecrawled) | set(o.crawled)):
        if ecrawled.get(k) != o.crawled.get(k):
            print(" ", k, "engine:", str(ecrawled.get(k))[:80],
                  "oracle:", str(o.crawled.get(k))[:80])
            break
print("MATCH" if ok else "FAIL")
