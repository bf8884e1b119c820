//! Emit golden vectors from the reference `xorf` crate for cross-language
//! parity tests (tests/test_rust_parity.py).
//!
//! For each filter type we record: the chosen seed, the layout parameter,
//! the raw little-endian fingerprint bytes, the probe bit-vector over the
//! member keys (all-ones: zero false negatives) and over a disjoint "alien"
//! key set (the exact false-positive pattern — the strongest
//! cross-implementation probe-path check), plus the 20-byte DMA descriptor
//! for the BinaryFuse family (reference src/bfuse8.rs:127-138).
//!
//! Key sets are deterministic:
//! - xor/bfuse: member_i = i * 0x9E3779B97F4A7C15 (wrapping, i in 1..=10_000;
//!   odd multiplier => all distinct), alien_i = member_i + 1 (disjoint: the
//!   multiplier's modular inverse is far outside the index range).
//! - legacy fuse (needs ~300k keys to build — it fails below that, which is
//!   why the reference deprecated it): splitmix64 stream from state
//!   0xDEADBEEF, 300_000 keys; aliens = first 10_000 of the CONTINUED stream
//!   (disjoint with overwhelming probability; verified disjoint at gen time).
//!   fuse8 carries full fingerprint bytes; fuse16/32 carry only a SHA-free
//!   FNV-1a digest to keep the committed fixture small (the probe math they
//!   add over fuse8 is just fingerprint width, covered by xor16/32+bfuse16/32).

#![allow(deprecated)] // Fuse8/16/32 are deprecated in the reference but still part of its API surface

use std::fmt::Write as _;
use xorf::{
    BinaryFuse16, BinaryFuse32, BinaryFuse8, DmaSerializable, Filter, Fuse16, Fuse32, Fuse8,
    Xor16, Xor32, Xor8,
};

const N: u64 = 10_000;
const N_FUSE: u64 = 300_000;
const MULT: u64 = 0x9E37_79B9_7F4A_7C15;

fn member_keys() -> Vec<u64> {
    (1..=N).map(|i| i.wrapping_mul(MULT)).collect()
}

fn alien_keys() -> Vec<u64> {
    (1..=N).map(|i| i.wrapping_mul(MULT).wrapping_add(1)).collect()
}

fn splitmix(state: &mut u64) -> u64 {
    *state = state.wrapping_add(0x9E37_79B9_7F4A_7C15);
    let mut z = *state;
    z = (z ^ (z >> 30)).wrapping_mul(0xBF58_476D_1CE4_E5B9);
    z = (z ^ (z >> 27)).wrapping_mul(0x94D0_49BB_1331_11EB);
    z ^ (z >> 31)
}

fn fuse_keys() -> (Vec<u64>, Vec<u64>) {
    let mut st = 0xDEAD_BEEFu64;
    let members: Vec<u64> = (0..N_FUSE).map(|_| splitmix(&mut st)).collect();
    let aliens: Vec<u64> = (0..N).map(|_| splitmix(&mut st)).collect();
    let mset: std::collections::HashSet<u64> = members.iter().copied().collect();
    assert!(aliens.iter().all(|a| !mset.contains(a)), "alien overlap");
    (members, aliens)
}

fn hex(b: &[u8]) -> String {
    let mut s = String::with_capacity(b.len() * 2);
    for x in b {
        write!(s, "{:02x}", x).unwrap();
    }
    s
}

/// Pack probe booleans LSB-first into bytes, then hex.
fn bits_hex(bits: &[bool]) -> String {
    let mut bytes = vec![0u8; (bits.len() + 7) / 8];
    for (i, b) in bits.iter().enumerate() {
        if *b {
            bytes[i / 8] |= 1 << (i % 8);
        }
    }
    hex(&bytes)
}

fn fnv1a(b: &[u8]) -> u64 {
    let mut h = 0xcbf2_9ce4_8422_2325u64;
    for x in b {
        h ^= *x as u64;
        h = h.wrapping_mul(0x0000_0100_0000_01B3);
    }
    h
}

fn le16(a: &[u16]) -> Vec<u8> {
    a.iter().flat_map(|v| v.to_le_bytes()).collect()
}

fn le32(a: &[u32]) -> Vec<u8> {
    a.iter().flat_map(|v| v.to_le_bytes()).collect()
}

fn probe<F: Filter<u64>>(f: &F, keys: &[u64]) -> Vec<bool> {
    keys.iter().map(|k| f.contains(k)).collect()
}

#[allow(clippy::too_many_arguments)]
fn entry(
    name: &str,
    seed: u64,
    layout_name: &str,
    layout: u64,
    fps: Option<&[u8]>,
    fps_digest: u64,
    member: &[bool],
    alien: &[bool],
    desc: Option<&[u8]>,
) -> String {
    let fps_part = fps
        .map(|f| format!(", \"fps_hex\": \"{}\"", hex(f)))
        .unwrap_or_default();
    let desc_part = desc
        .map(|d| format!(", \"desc_hex\": \"{}\"", hex(d)))
        .unwrap_or_default();
    format!(
        "  \"{name}\": {{\"seed\": \"{seed}\", \"{layout_name}\": {layout}, \
         \"fps_fnv1a\": \"{fps_digest}\", \"member_all\": {}, \
         \"alien_hex\": \"{}\"{fps_part}{desc_part}}}",
        member.iter().all(|b| *b),
        bits_hex(alien)
    )
}

fn dma_desc<F: DmaSerializable>(f: &F) -> Vec<u8> {
    let mut d = vec![0u8; F::DESCRIPTOR_LEN];
    f.dma_copy_descriptor_to(&mut d);
    d
}

fn main() {
    let out = std::env::args().nth(1).expect("usage: gen <out.json>");
    let keys = member_keys();
    let aliens = alien_keys();
    let (fkeys, faliens) = fuse_keys();
    let mut entries: Vec<String> = Vec::new();

    let f = Xor8::from(&keys);
    entries.push(entry("xor8", f.seed, "block_length", f.block_length as u64,
        Some(&f.fingerprints), fnv1a(&f.fingerprints),
        &probe(&f, &keys), &probe(&f, &aliens), None));
    let f = Xor16::from(&keys);
    let b = le16(&f.fingerprints);
    entries.push(entry("xor16", f.seed, "block_length", f.block_length as u64,
        Some(&b), fnv1a(&b), &probe(&f, &keys), &probe(&f, &aliens), None));
    let f = Xor32::from(&keys);
    let b = le32(&f.fingerprints);
    entries.push(entry("xor32", f.seed, "block_length", f.block_length as u64,
        Some(&b), fnv1a(&b), &probe(&f, &keys), &probe(&f, &aliens), None));

    let f = Fuse8::try_from(&fkeys).unwrap();
    entries.push(entry("fuse8", f.seed, "segment_length", f.segment_length as u64,
        Some(&f.fingerprints), fnv1a(&f.fingerprints),
        &probe(&f, &fkeys), &probe(&f, &faliens), None));
    let f = Fuse16::try_from(&fkeys).unwrap();
    let b = le16(&f.fingerprints);
    entries.push(entry("fuse16", f.seed, "segment_length", f.segment_length as u64,
        None, fnv1a(&b), &probe(&f, &fkeys), &probe(&f, &faliens), None));
    let f = Fuse32::try_from(&fkeys).unwrap();
    let b = le32(&f.fingerprints);
    entries.push(entry("fuse32", f.seed, "segment_length", f.segment_length as u64,
        None, fnv1a(&b), &probe(&f, &fkeys), &probe(&f, &faliens), None));

    let f = BinaryFuse8::try_from(&keys).unwrap();
    entries.push(entry("bfuse8", 0, "len", f.fingerprints.len() as u64,
        Some(&f.fingerprints), fnv1a(&f.fingerprints),
        &probe(&f, &keys), &probe(&f, &aliens), Some(&dma_desc(&f))));
    let f = BinaryFuse16::try_from(&keys).unwrap();
    let b = le16(&f.fingerprints);
    entries.push(entry("bfuse16", 0, "len", f.fingerprints.len() as u64,
        Some(&b), fnv1a(&b), &probe(&f, &keys), &probe(&f, &aliens),
        Some(&dma_desc(&f))));
    let f = BinaryFuse32::try_from(&keys).unwrap();
    let b = le32(&f.fingerprints);
    entries.push(entry("bfuse32", 0, "len", f.fingerprints.len() as u64,
        Some(&b), fnv1a(&b), &probe(&f, &keys), &probe(&f, &aliens),
        Some(&dma_desc(&f))));

    let json = format!(
        "{{\n  \"n_keys\": {N}, \"n_fuse_keys\": {N_FUSE}, \"mult\": \"{MULT}\",\n{}\n}}\n",
        entries.join(",\n")
    );
    std::fs::write(&out, json).expect("write fixtures");
    eprintln!("wrote {out}");
}
