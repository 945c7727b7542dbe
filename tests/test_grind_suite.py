"""Port of reference test/backend/grind.test.ts (13 cases) and
test/backend/simd/grind.test.ts (22 cases): proof-of-work nonce search
semantics.  The reference's Cpu/Simd/Generic class split collapses here
into grind_host (scalar) and grind (device batched) — both are covered
and pinned equal, which subsumes the "class-based vs standalone agree"
cases.
"""
import pytest

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.channel.poseidon import Poseidon252Channel
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.proof_of_work import grind, grind_host


def _check(channel, nonce, pow_bits):
    ch = channel.clone()
    ch.mix_u64(nonce)
    assert ch.trailing_zeros() >= pow_bits


# -- CpuGrindOps / SimdGrindOps grind ---------------------------------------

@pytest.mark.parametrize("impl", [grind_host, grind])
def test_grind_zero_trailing_zeros_always_succeeds(impl):
    ch = Blake2sChannel()
    nonce = impl(ch.clone(), 0)
    _check(ch, nonce, 0)


@pytest.mark.parametrize("impl", [grind_host, grind])
def test_grind_one_trailing_zero(impl):
    ch = Blake2sChannel()
    nonce = impl(ch.clone(), 1)
    _check(ch, nonce, 1)


@pytest.mark.parametrize("impl", [grind_host, grind])
def test_grind_two_trailing_zeros(impl):
    ch = Blake2sChannel()
    nonce = impl(ch.clone(), 2)
    _check(ch, nonce, 2)


def test_grind_different_channel_states_diverge():
    c1, c2 = Blake2sChannel(), Blake2sChannel()
    c2.mix_u64(999)
    n1 = grind_host(c1.clone(), 4)
    n2 = grind_host(c2.clone(), 4)
    # nonces are state-dependent; both must satisfy their own channel
    _check(c1, n1, 4)
    _check(c2, n2, 4)


@pytest.mark.parametrize("impl", [grind_host, grind])
def test_grind_does_not_modify_original_channel(impl):
    ch = Blake2sChannel()
    ch.mix_u64(42)
    digest_before = ch.digest
    time_before = (ch.channel_time.n_challenges, ch.channel_time.n_sent)
    impl(ch.clone(), 3)
    assert ch.digest == digest_before
    assert (ch.channel_time.n_challenges, ch.channel_time.n_sent) == time_before


@pytest.mark.parametrize("impl", [grind_host, grind])
def test_grind_with_mixed_data(impl):
    ch = Blake2sChannel()
    ch.mix_u32s([1, 2, 3])
    ch.mix_felts([QM31.from_base(M31(7))])
    nonce = impl(ch.clone(), 4)
    _check(ch, nonce, 4)


def test_grind_high_requirement_still_terminates():
    """8 bits ≈ 256 expected attempts — must terminate quickly."""
    ch = Blake2sChannel()
    nonce = grind(ch.clone(), 8)
    _check(ch, nonce, 8)


def test_grind_nonce_is_smallest_host():
    """Rust semantics: the scalar search returns the FIRST valid nonce."""
    ch = Blake2sChannel()
    nonce = grind_host(ch.clone(), 3)
    for candidate in range(nonce):
        probe = ch.clone()
        probe.mix_u64(candidate)
        assert probe.trailing_zeros() < 3


def test_grind_device_matches_host_smallest():
    for seed in (0, 1, 77):
        ch = Blake2sChannel()
        ch.mix_u64(seed)
        assert grind(ch.clone(), 6) == grind_host(ch.clone(), 6)


def test_grind_nonce_zero_possible_semantics():
    """nonce=0 is a legal return value: if mixing 0 already satisfies the
    bits, the search returns 0."""
    ch = Blake2sChannel()
    nonce = grind_host(ch.clone(), 0)
    assert nonce == 0


# -- generic channel (SimdGenericGrindOps) ----------------------------------

def test_grind_generic_poseidon_channel():
    ch = Poseidon252Channel()
    nonce = grind_host(ch.clone(), 2)
    probe = ch.clone()
    probe.mix_u64(nonce)
    assert probe.trailing_zeros() >= 2


def test_grind_generic_poseidon_with_mixed_data():
    ch = Poseidon252Channel()
    ch.mix_u64(123)
    nonce = grind_host(ch.clone(), 3)
    probe = ch.clone()
    probe.mix_u64(nonce)
    assert probe.trailing_zeros() >= 3


# -- channel cloning (grind.test.ts "channel cloning") ----------------------

def test_clone_preserves_digest_and_time():
    ch = Blake2sChannel()
    ch.mix_u64(5)
    ch.draw_felt()
    cp = ch.clone()
    assert cp.digest == ch.digest
    assert cp.channel_time.n_challenges == ch.channel_time.n_challenges
    assert cp.channel_time.n_sent == ch.channel_time.n_sent


def test_clone_divergence_after_mix():
    ch = Blake2sChannel()
    cp = ch.clone()
    cp.mix_u64(1)
    assert cp.digest != ch.digest


# -- consistency sweep (both files' "performance and correctness") ----------

@pytest.mark.parametrize("pow_bits", [0, 1, 2, 3, 4, 5])
def test_grind_consistently_valid(pow_bits):
    ch = Blake2sChannel()
    ch.mix_u64(pow_bits * 31 + 1)
    nonce = grind_host(ch.clone(), pow_bits)
    _check(ch, nonce, pow_bits)


def test_grind_deterministic():
    ch = Blake2sChannel()
    ch.mix_u32s([9, 8, 7])
    assert grind_host(ch.clone(), 4) == grind_host(ch.clone(), 4)
    assert grind(ch.clone(), 4) == grind(ch.clone(), 4)


def test_grind_mirrors_rust_verification_loop():
    """Verification mirror: mixing the found nonce into a fresh clone of
    the pre-grind channel reproduces >= pow_bits trailing zeros, and the
    proof-of-work check in verify uses exactly this recipe."""
    ch = Blake2sChannel()
    ch.mix_felts([QM31.from_base(M31(1234))])
    pow_bits = 5
    nonce = grind(ch.clone(), pow_bits)
    verifier_side = ch.clone()
    verifier_side.mix_u64(nonce)
    assert verifier_side.trailing_zeros() >= pow_bits
