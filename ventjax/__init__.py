"""ventjax: TPU-native hyperpolarized 129Xe ventilation-MRI analysis."""
from ventjax.config import VentConfig, DEFAULT_CONFIG, VERSION as __version__
