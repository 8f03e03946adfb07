"""MATLAB parula 64-entry colormap table.

This is the raw 64x3 RGB lookup table the reference report path loads from
parula.npy (/root/reference/Vent_Analysis.py:466) and that
parula_colormap.py wraps as a matplotlib colormap.  It is embedded here as
data so the report layer has no runtime file dependency; the golden test
(tests/test_goldens.py) pins its SHA256 against the reference artifact."""
import numpy as np

PARULA_64 = np.array([
    [np.float64(0.2081), np.float64(0.1663), np.float64(0.5292)],
    [np.float64(0.2116238095), np.float64(0.1897809524), np.float64(0.5776761905)],
    [np.float64(0.212252381), np.float64(0.2137714286), np.float64(0.6269714286)],
    [np.float64(0.2081), np.float64(0.2386), np.float64(0.6770857143)],
    [np.float64(0.1959047619), np.float64(0.2644571429), np.float64(0.7279)],
    [np.float64(0.1707285714), np.float64(0.2919380952), np.float64(0.779247619)],
    [np.float64(0.1252714286), np.float64(0.3242428571), np.float64(0.8302714286)],
    [np.float64(0.0591333333), np.float64(0.3598333333), np.float64(0.8683333333)],
    [np.float64(0.0116952381), np.float64(0.3875095238), np.float64(0.8819571429)],
    [np.float64(0.0059571429), np.float64(0.4086142857), np.float64(0.8828428571)],
    [np.float64(0.0165142857), np.float64(0.4266), np.float64(0.8786333333)],
    [np.float64(0.032852381), np.float64(0.4430428571), np.float64(0.8719571429)],
    [np.float64(0.0498142857), np.float64(0.4585714286), np.float64(0.8640571429)],
    [np.float64(0.0629333333), np.float64(0.4736904762), np.float64(0.8554380952)],
    [np.float64(0.0722666667), np.float64(0.4886666667), np.float64(0.8467)],
    [np.float64(0.0779428571), np.float64(0.5039857143), np.float64(0.8383714286)],
    [np.float64(0.079347619), np.float64(0.5200238095), np.float64(0.8311809524)],
    [np.float64(0.0749428571), np.float64(0.5375428571), np.float64(0.8262714286)],
    [np.float64(0.0640571429), np.float64(0.5569857143), np.float64(0.8239571429)],
    [np.float64(0.0487714286), np.float64(0.5772238095), np.float64(0.8228285714)],
    [np.float64(0.0343428571), np.float64(0.5965809524), np.float64(0.819852381)],
    [np.float64(0.0265), np.float64(0.6137), np.float64(0.8135)],
    [np.float64(0.0238904762), np.float64(0.6286619048), np.float64(0.8037619048)],
    [np.float64(0.0230904762), np.float64(0.6417857143), np.float64(0.7912666667)],
    [np.float64(0.0227714286), np.float64(0.6534857143), np.float64(0.7767571429)],
    [np.float64(0.0266619048), np.float64(0.6641952381), np.float64(0.7607190476)],
    [np.float64(0.0383714286), np.float64(0.6742714286), np.float64(0.743552381)],
    [np.float64(0.0589714286), np.float64(0.6837571429), np.float64(0.7253857143)],
    [np.float64(0.0843), np.float64(0.6928333333), np.float64(0.7061666667)],
    [np.float64(0.1132952381), np.float64(0.7015), np.float64(0.6858571429)],
    [np.float64(0.1452714286), np.float64(0.7097571429), np.float64(0.6646285714)],
    [np.float64(0.1801333333), np.float64(0.7176571429), np.float64(0.6424333333)],
    [np.float64(0.2178285714), np.float64(0.7250428571), np.float64(0.6192619048)],
    [np.float64(0.2586428571), np.float64(0.7317142857), np.float64(0.5954285714)],
    [np.float64(0.3021714286), np.float64(0.7376047619), np.float64(0.5711857143)],
    [np.float64(0.3481666667), np.float64(0.7424333333), np.float64(0.5472666667)],
    [np.float64(0.3952571429), np.float64(0.7459), np.float64(0.5244428571)],
    [np.float64(0.4420095238), np.float64(0.7480809524), np.float64(0.5033142857)],
    [np.float64(0.4871238095), np.float64(0.7490619048), np.float64(0.4839761905)],
    [np.float64(0.5300285714), np.float64(0.7491142857), np.float64(0.4661142857)],
    [np.float64(0.5708571429), np.float64(0.7485190476), np.float64(0.4493904762)],
    [np.float64(0.609852381), np.float64(0.7473142857), np.float64(0.4336857143)],
    [np.float64(0.6473), np.float64(0.7456), np.float64(0.4188)],
    [np.float64(0.6834190476), np.float64(0.7434761905), np.float64(0.4044333333)],
    [np.float64(0.7184095238), np.float64(0.7411333333), np.float64(0.3904761905)],
    [np.float64(0.7524857143), np.float64(0.7384), np.float64(0.3768142857)],
    [np.float64(0.7858428571), np.float64(0.7355666667), np.float64(0.3632714286)],
    [np.float64(0.8185047619), np.float64(0.7327333333), np.float64(0.3497904762)],
    [np.float64(0.8506571429), np.float64(0.7299), np.float64(0.3360285714)],
    [np.float64(0.8824333333), np.float64(0.7274333333), np.float64(0.3217)],
    [np.float64(0.9139333333), np.float64(0.7257857143), np.float64(0.3062761905)],
    [np.float64(0.9449571429), np.float64(0.7261142857), np.float64(0.2886428571)],
    [np.float64(0.9738952381), np.float64(0.7313952381), np.float64(0.266647619)],
    [np.float64(0.9937714286), np.float64(0.7454571429), np.float64(0.240347619)],
    [np.float64(0.9990428571), np.float64(0.7653142857), np.float64(0.2164142857)],
    [np.float64(0.9955333333), np.float64(0.7860571429), np.float64(0.196652381)],
    [np.float64(0.988), np.float64(0.8066), np.float64(0.1793666667)],
    [np.float64(0.9788571429), np.float64(0.8271428571), np.float64(0.1633142857)],
    [np.float64(0.9697), np.float64(0.8481380952), np.float64(0.147452381)],
    [np.float64(0.9625857143), np.float64(0.8705142857), np.float64(0.1309)],
    [np.float64(0.9588714286), np.float64(0.8949), np.float64(0.1132428571)],
    [np.float64(0.9598238095), np.float64(0.9218333333), np.float64(0.0948380952)],
    [np.float64(0.9661), np.float64(0.9514428571), np.float64(0.0755333333)],
    [np.float64(0.9763), np.float64(0.9831), np.float64(0.0538)],
], dtype=np.float64)


def get_parula_colormap():
    """Matplotlib LinearSegmentedColormap built from the table (parity with
    the reference parula_colormap.get_parula_colormap)."""
    from matplotlib.colors import LinearSegmentedColormap
    return LinearSegmentedColormap.from_list('parula', PARULA_64.tolist())
