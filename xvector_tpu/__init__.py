"""xvector_tpu — TPU-native x-vector speaker-embedding framework.

From-scratch JAX/XLA/Pallas re-design of the BUTSpeechFIT/x-vector-kaldi-tf
capability surface: on-device MFCC/VAD/CMVN features, an 8-topology TDNN
model zoo with masked stats/attention pooling, SPMD training over a
(data, model) mesh, bucketed batched extraction, Kaldi ark/scp interchange,
and a native PLDA/EER back-end.  See README.md for the component map.
"""

__version__ = "0.1.0"

from .models import tdnn  # noqa: F401
from .models.tdnn import MODEL_ZOO, TdnnConfig  # noqa: F401
