"""Shared harness for the scaling bench scripts (bench_scaling,
bench_rtree_ladder, bench_dct_scaling, bench_corpus_scaling).

One copy of the sbt/raw-java leg plumbing so a fix lands everywhere at
once — the copies had already diverged (the MemFloor 32-pass fix and the
REPO-anchored BENCH_SCALING.md path each reached only some scripts).
"""
import json
import os
import pathlib
import re
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
CP = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
# one 8-core cpuset per emulated executor JVM (what YARN/k8s pins)
CPUSETS = ["0-7", "8-15", "16-23", "24-31"]
ADD_OPENS = sum((["--add-opens", p + "=ALL-UNNAMED"] for p in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"]), [])
# REPO-anchored: a cwd-relative path would silently write a fresh file in
# whatever directory launched a multi-hour run
BENCH_MD = pathlib.Path(REPO) / "BENCH_SCALING.md"


def last_json(text):
    """Last line-level {...} that actually parses as JSON — a Spark log
    line containing braces must not be mistaken for the result line."""
    for m in reversed(re.findall(r'\{.*\}', text)):
        try:
            return json.loads(m)
        except ValueError:
            continue
    return None


def sbt(cmd, env_extra=None):
    """Run one sbt leg; return its result-JSON line. Exits loudly (stdout
    AND stderr tails — the JVM crash/OOM cause lands on stderr under
    capture_output) when the leg fails or emits no parseable JSON."""
    p = subprocess.run(
        ["sbt", "-batch", cmd], capture_output=True, text=True,
        # 12g fixed heap: large enough for every leg, small enough that the
        # one-time first-touch fault cost stays out of the measured reps.
        env={**os.environ, "SPARK_DRIVER_MEM": "12g", **(env_extra or {})})
    d = last_json(p.stdout)
    if p.returncode != 0 or d is None:
        print(p.stdout[-3000:], file=sys.stderr)
        print(p.stderr[-3000:], file=sys.stderr)
        print(f"[benchlib] sbt leg failed (rc={p.returncode}): {cmd}",
              file=sys.stderr)
        sys.exit(1)
    return d


def java_leg(main_args, heap, cpuset, log, extra_jvm=(), env_extra=None):
    """Launch one raw pinned JVM on the staged classpath (concurrent legs
    must not go through sbt: two sbt instances race on the boot-server
    socket). Caller waits and reads the result via shard_json(log)."""
    f = open(log, "w")
    cmd = (["taskset", "-c", cpuset, "java"] + ADD_OPENS + [
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        f"-Xmx{heap}", f"-Xms{heap}", "-XX:+UseG1GC", *extra_jvm,
        "-cp", CP] + list(main_args))
    return subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT,
                            env={**os.environ, **(env_extra or {})})


def shard_json(log):
    d = last_json(open(log).read())
    if d is None:
        print(open(log).read()[-3000:], file=sys.stderr)
        print(f"[benchlib] no result JSON in {log}", file=sys.stderr)
        sys.exit(1)
    return d
