"""Solution output: npz checkpoints (with load/resume -- the reference's
HDF5 CheckpointFile is write-only, control/control.py:600-604), legacy-VTK
export for ParaView (the reference's .pvd output), and optional matplotlib
plots."""

import os
import numpy as np


def _grid_xyz(space):
    """Coordinate arrays flattened x-fastest, plus (nx, ny, nz) counts."""
    coords = space.node_coords()
    if len(coords) == 3:
        X, Y, Z = coords
        nz, ny, nx = X.shape
    else:
        X, Y = coords
        Z = np.zeros_like(X)
        ny, nx = X.shape
        nz = 1
    return (X.ravel(), Y.ravel(), Z.ravel()), (nx, ny, nz)


def write_vtk(filename, space, fields, time=None):
    """Legacy-VTK structured-grid writer (ASCII), 2-D and 3-D."""
    (Xf, Yf, Zf), (nx, ny, nz) = _grid_xyz(space)
    npts = nx * ny * nz
    with open(filename, "w") as fh:
        fh.write("# vtk DataFile Version 3.0\n")
        fh.write(f"control_tpu output{'' if time is None else f' t={time}'}\n")
        fh.write("ASCII\nDATASET STRUCTURED_GRID\n")
        fh.write(f"DIMENSIONS {nx} {ny} {nz}\n")
        fh.write(f"POINTS {npts} double\n")
        for x, y, z in zip(Xf, Yf, Zf):
            fh.write(f"{x} {y} {z}\n")
        fh.write(f"POINT_DATA {npts}\n")
        for name, data in fields.items():
            arr = np.asarray(data)
            if space.dim is None:
                fh.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                for v in arr.ravel():
                    fh.write(f"{v}\n")
            else:
                fh.write(f"VECTORS {name} double\n")
                comps = arr.reshape(-1, space.dim)
                for row in comps:
                    z = row[2] if space.dim > 2 else 0.0
                    fh.write(f"{row[0]} {row[1]} {z}\n")


def write_solution(name, fn, directory="."):
    """Checkpoint a Function: ``<name>.npz`` (+ best-effort .vtk)."""
    path = os.path.join(directory, f"{name}.npz")
    m = fn.space.mesh
    mesh_n = ([m.nx, m.ny, m.nz] if fn.space.ndim == 3 else [m.nx, m.ny])
    box = [m.x0, m.x1, m.y0, m.y1]
    if fn.space.ndim == 3:
        box += [m.z0, m.z1]
    np.savez(path, data=np.asarray(fn.data),
             degree=fn.space.degree,
             dim=-1 if fn.space.dim is None else fn.space.dim,
             mesh=np.array(mesh_n), box=np.array(box))
    try:
        write_vtk(os.path.join(directory, f"{name}.vtk"), fn.space,
                  {name: fn.data})
    except Exception:
        pass


def load_solution(name, space, directory="."):
    """Resume path absent from the reference: load a checkpoint back into a
    Function on a matching space."""
    from ..fem.space import Function
    path = os.path.join(directory, f"{name}.npz")
    with np.load(path) as z:
        data = z["data"]
    if tuple(data.shape) != tuple(space.grid_shape):
        raise ValueError(f"checkpoint shape {data.shape} does not match "
                         f"space {space.grid_shape}")
    return Function(space, name=name, data=data)


def write_time_series(name, mixed_fn, times, directory="."):
    """Time-series checkpoint of a MixedFunction (one npz; vtk per step)."""
    np.savez(os.path.join(directory, f"{name}.npz"),
             data=np.asarray(mixed_fn.data), times=np.asarray(times))
    try:
        for i, t in enumerate(times):
            write_vtk(os.path.join(directory, f"{name}_{i:04d}.vtk"),
                      mixed_fn.space, {name: mixed_fn.data[i]}, time=t)
    except Exception:
        pass


def plot_fields(directory=".", **fields):
    """Save pseudocolor plots (non-interactive; the reference calls
    plt.show(), control/control.py:606-620)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover
        print(f"Cannot plot figure. Error msg: '{e}'")
        return
    for name, fn in fields.items():
        if fn is None:
            continue
        try:
            arr = np.asarray(fn.data)
            fig, ax = plt.subplots()
            if arr.ndim == 3:
                arr = np.linalg.norm(arr, axis=-1)
            im = ax.pcolormesh(arr)
            fig.colorbar(im)
            fig.savefig(os.path.join(directory, f"{name}.png"), dpi=100)
            plt.close(fig)
        except Exception as e:  # pragma: no cover
            print(f"Cannot plot figure. Error msg: '{e}'")


class File:
    """Parity shim for firedrake.File("name.pvd"): collects VTK files."""

    def __init__(self, name):
        self.base = name[:-4] if name.endswith(".pvd") else name
        self.count = 0

    def write(self, fn, t=None):
        write_vtk(f"{self.base}_{self.count:04d}.vtk", fn.space,
                  {self.base.split('/')[-1]: fn.data}, time=t)
        self.count += 1


class CheckpointFile:
    """Parity shim for firedrake.CheckpointFile (npz-backed, adds load)."""

    def __init__(self, name, mode="w"):
        self.base = name[:-3] if name.endswith(".h5") else name
        self.mode = mode

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def save_function(self, fn):
        write_solution(self.base, fn)

    def load_function(self, space):
        return load_solution(self.base, space)
