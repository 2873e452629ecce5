#!/usr/bin/env python
"""Regenerate volumetricrenderer_tpu/models/tree_assets.py from the reference
FBX tree meshes (mesh ingestion bake: io/fbx.py -> models/voxelize.py).

Run from the repo root with the reference checkout present:
    python tools/bake_tree_boxes.py [/root/reference]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from volumetricrenderer_tpu.io.fbx import (load_fbx_meshes, merge_meshes,
                                           normalize_mesh)
# the native (C++) ingestion core when a toolchain exists, else numpy —
# bit-identical either way (tests/test_native_ingest.py)
from volumetricrenderer_tpu.io.native import mesh_to_boxes

TREES = [
    ("TREE_0", "Assets/Fbxs/Nature_Tree_0_Up.fbx", 6.0),
    ("TREE_1", "Assets/Fbxs/Nature_Tree_1_Leaves.fbx", 7.0),
]

HEADER = '''"""Mesh-derived tree occluder boxes (GENERATED — do not hand-edit).

Produced by tools/bake_tree_boxes.py: the reference's FBX tree meshes
(/root/reference/Assets/Fbxs/Nature_Tree_*.fbx, instanced by
Assets/Prefabs/Enviornment.prefab + Tree.prefab) parsed with io/fbx.py,
voxelized and greedily box-decomposed with models/voxelize.py (res=20,
max 8 boxes, ~90% occupied-voxel coverage). Each entry is (bmin, bmax,
opacity) in meters for a tree standing on y=0 at the named height; instance with
models.voxelize.transform_boxes. Checked in so scenes build without the
reference checkout; re-run the tool to regenerate.
"""

'''


def main():
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    out = [HEADER]
    for name, rel, height in TREES:
        meshes = load_fbx_meshes(os.path.join(ref, rel))
        verts, tris = merge_meshes(meshes)
        verts = normalize_mesh(verts, height=height)
        boxes = mesh_to_boxes(verts, tris, res=20, max_boxes=8)
        out.append(f"# {rel}: {len(verts)} verts, {len(tris)} tris, "
                   f"height {height} m\n{name} = [\n")
        for bmin, bmax, opacity in boxes:
            bm = ", ".join(f"{v:.3f}" for v in bmin)
            bx = ", ".join(f"{v:.3f}" for v in bmax)
            out.append(f"    (({bm}), ({bx}), {opacity:.3f}),\n")
        out.append("]\n\n")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "volumetricrenderer_tpu", "models",
        "tree_assets.py")
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
