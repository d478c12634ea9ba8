"""Build-time extraction of the Joe & Kuo Sobol direction-number table.

The new-joe-kuo-6 table (https://web.maths.unsw.edu.au/~fkuo/sobol/) is
public data; scipy redistributes it as ``_sobol_direction_numbers.npz``
(primitive polynomials + initial m-values for 21201 dimensions).  This
script copies it into ``particles_tpu/data/sobol_joe_kuo.npz`` so the
package generates Sobol points natively with no scipy dependency (and in
particular no reach into scipy private APIs at runtime).

Run once per scipy upgrade: ``python tools/extract_sobol_table.py``.
"""

import os

import numpy as np


def main():
    import scipy.stats._sobol as _s

    src = os.path.join(os.path.dirname(_s.__file__),
                       "_sobol_direction_numbers.npz")
    npz = np.load(src)
    poly = np.asarray(npz["poly"], np.int64)
    vinit = np.asarray(npz["vinit"], np.int64)
    assert poly.shape[0] == vinit.shape[0] == 21201, poly.shape
    assert vinit.max() < 2**31 and poly.max() < 2**31
    out = os.path.join(os.path.dirname(__file__), "..", "particles_tpu",
                       "data", "sobol_joe_kuo.npz")
    np.savez_compressed(out, poly=poly.astype(np.int32),
                        vinit=vinit.astype(np.int32))
    print("wrote", os.path.abspath(out), os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
