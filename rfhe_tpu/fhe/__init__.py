"""L4 scheme layer: RNS polynomials, CKKS/BGV/BFV contexts, keys, evaluator."""
from .params import CkksParams, BgvParams, BfvParams, make_prime_chain  # noqa: F401
from .rns import RnsContext, RnsPoly, rescale, drop_limb  # noqa: F401
from .keys import KeyGen, SecretKey, PublicKey, KeySwitchKey, keyswitch  # noqa: F401
from .ckks import CkksContext, Ciphertext, encode, decode  # noqa: F401
from .bgv import BgvContext  # noqa: F401
from .bfv import BfvContext  # noqa: F401
