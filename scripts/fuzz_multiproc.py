#!/usr/bin/env python3
"""Cross-PROCESS concurrent-writer fuzz for the GraftStore commit protocol.

The claim/snapshot machinery is file-based precisely so writers in
different JVMs serialize correctly; the in-JVM specs can't prove that.
This harness forks N separate `java` processes (each its own Spark
driver, local master) running graft.MultiWriterRunner `write` against ONE
table directory — interleaved appends, keyed upserts, optimize and
rebucket — then runs `verify`, which checks: contiguous versions, no
orphan claims, no duplicate keys, live contents == the union of what
every writer recorded as committed, and changelog replay from v0 == live.

Usage: python3 scripts/fuzz_multiproc.py [nWriters] [nOps] [seed]
Requires `sbt -batch compile` to have populated target/scala-2.13/classes.
"""
import glob, os, subprocess, sys, tempfile

n_writers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 12
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
classes = os.path.join(repo, "target", "scala-2.13", "classes")
if not os.path.isdir(classes):
    sys.exit("run `sbt -batch compile` first (no target/scala-2.13/classes)")
scala_lib = glob.glob(os.path.expanduser(
    "~/.sbt/boot/scala-2.13.*/lib/scala-library.jar")) + glob.glob(
    "/opt/spark/jars/scala-library*.jar")
cp = ":".join([classes, "/opt/spark/jars/*"] + scala_lib[:1])

work = tempfile.mkdtemp(prefix="graft_multiproc_")
table = os.path.join(work, "t")
java = ["java", "--add-exports=java.base/sun.nio.ch=ALL-UNNAMED",
        "-Xmx2g", "-cp", cp, "graft.MultiWriterRunner"]

def run(args, **kw):
    return subprocess.run(java + args, capture_output=True, text=True,
                          timeout=900, **kw)

r = run(["init", table])
if "[multiwriter] init ok" not in r.stdout:
    print(r.stdout[-2000:]); print(r.stderr[-2000:])
    sys.exit("init failed")

procs, outs = [], []
for w in range(1, n_writers + 1):
    out = os.path.join(work, f"writer{w}.tsv")
    outs.append(out)
    procs.append(subprocess.Popen(
        java + ["write", table, str(w), str(n_ops), str(seed + w), out],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

fail = False
for w, p in enumerate(procs, start=1):
    so, se = p.communicate(timeout=900)
    line = next((l for l in so.splitlines() if "[multiwriter]" in l), "?")
    print(f"writer {w}: rc={p.returncode} {line}")
    if p.returncode != 0:
        fail = True
        print(se[-3000:])

if not fail:
    r = run(["verify", table] + outs)
    for l in r.stdout.splitlines():
        if "[multiwriter]" in l:
            print(l)
    fail = r.returncode != 0 or "VERIFY OK" not in r.stdout
    if fail:
        print(r.stderr[-3000:])

print(f"multiproc fuzz: {'FAIL' if fail else 'PASS'} "
      f"(writers={n_writers} ops={n_ops} seed={seed})")
sys.exit(1 if fail else 0)
