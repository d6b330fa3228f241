"""Long-lived TPU worker: executes numbered job files in one process.

Avoids re-paying axon backend init / wedge drain per measurement: drop
``/tmp/tpu_jobs/NNN.py`` files; each is exec'd in a persistent namespace
and its stdout + traceback go to ``NNN.out`` (written atomically via
rename).  ``STOP`` in the job dir exits."""
import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

ns = {}
print("worker up, importing jax...", flush=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ns["jax"] = jax
print("devices:", jax.devices(), flush=True)
done = set()
while True:
    if os.path.exists(os.path.join(JOBS, "STOP")):
        print("stopping", flush=True)
        break
    jobs = sorted(f for f in os.listdir(JOBS)
                  if f.endswith(".py") and f not in done)
    for j in jobs:
        done.add(j)
        path = os.path.join(JOBS, j)
        out_path = path[:-3] + ".out"
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        t0 = time.time()
        try:
            with open(path) as fh:
                code = fh.read()
            exec(compile(code, path, "exec"), ns)
            status = "OK"
        except Exception:
            traceback.print_exc(file=buf)
            status = "ERROR"
        finally:
            sys.stdout = old
        with open(out_path + ".tmp", "w") as fh:
            fh.write(f"# {status} in {time.time()-t0:.1f}s\n")
            fh.write(buf.getvalue())
        os.replace(out_path + ".tmp", out_path)
        print(f"{j}: {status} {time.time()-t0:.1f}s", flush=True)
    time.sleep(1)
