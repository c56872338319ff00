"""Print XLA memory_analysis for serialized bench executables.

Deserializing loads the program onto the backend but does not execute it;
memory_analysis reports argument/output/temp/peak bytes so OOMs can be
attributed without burning a 256^3 run.
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jax.experimental.serialize_executable import deserialize_and_load


def analyze(path):
    with open(path, "rb") as f:
        d = pickle.load(f)
    compiled = deserialize_and_load(d["payload"], d["in_tree"], d["out_tree"])
    try:
        m = compiled.memory_analysis()
        gb = 1024 ** 3
        print(f"{path}:")
        print(f"  args      {m.argument_size_in_bytes / gb:8.3f} GiB")
        print(f"  outputs   {m.output_size_in_bytes / gb:8.3f} GiB")
        print(f"  temps     {m.temp_size_in_bytes / gb:8.3f} GiB")
        print(f"  aliased   {m.alias_size_in_bytes / gb:8.3f} GiB")
        print(f"  generated code {m.generated_code_size_in_bytes / gb:8.3f} GiB")
        tot = (m.argument_size_in_bytes + m.output_size_in_bytes
               + m.temp_size_in_bytes - m.alias_size_in_bytes)
        print(f"  ~peak     {tot / gb:8.3f} GiB")
    except Exception as e:
        print(f"{path}: memory_analysis failed: {e!r}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        analyze(p)
