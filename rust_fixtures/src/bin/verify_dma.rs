//! Reverse-direction interop check: load a PYTHON-built filter from its DMA
//! bytes with the REFERENCE's `from_dma` and probe it with the reference's
//! `contains` (tests/test_rust_parity.py::test_python_build_probes_in_rust).
//!
//! stdin: JSON {"kind": "bfuse8|bfuse16|bfuse32", "desc_hex": ..,
//!              "fps_hex": .., "n_keys": N, "mult": "<u64 dec>",
//!              "alien_hex": ..}
//! Member key i = i * mult (wrapping, 1..=N); alien_hex is the expected
//! LSB-first probe bit pattern for member_i + 1.
//! Prints "OK" on exact agreement, a diagnostic otherwise (exit 1).

use std::io::Read;
use xorf::{
    BinaryFuse16Ref, BinaryFuse32Ref, BinaryFuse8Ref, Filter, FilterRef, Xor16, Xor32, Xor8,
};

fn hex_to_bytes(s: &str) -> Vec<u8> {
    (0..s.len())
        .step_by(2)
        .map(|i| u8::from_str_radix(&s[i..i + 2], 16).unwrap())
        .collect()
}

fn field<'a>(json: &'a str, key: &str) -> &'a str {
    // minimal extraction for our flat, known-shape document (no serde offline)
    let pat = format!("\"{key}\":");
    let start = json.find(&pat).expect(key) + pat.len();
    let rest = json[start..].trim_start();
    if let Some(stripped) = rest.strip_prefix('"') {
        &stripped[..stripped.find('"').unwrap()]
    } else {
        let end = rest.find([',', '}']).unwrap();
        rest[..end].trim()
    }
}

fn check<'a, F>(fps: &'a [u8], desc: &[u8], members: &[u64], aliens: &[u64],
                want_alien: &[bool]) -> Result<(), String>
where
    F: FilterRef<'a, u64>,
{
    let f = F::from_dma(desc, fps);
    for (i, k) in members.iter().enumerate() {
        if !f.contains(k) {
            return Err(format!("false negative at member {i}"));
        }
    }
    for (i, k) in aliens.iter().enumerate() {
        if f.contains(k) != want_alien[i] {
            return Err(format!("alien bit {i} mismatch"));
        }
    }
    Ok(())
}

fn main() {
    let mut json = String::new();
    std::io::stdin().read_to_string(&mut json).unwrap();
    let kind = field(&json, "kind");
    let desc = hex_to_bytes(field(&json, "desc_hex"));
    let fps = hex_to_bytes(field(&json, "fps_hex"));
    let n: u64 = field(&json, "n_keys").parse().unwrap();
    let mult: u64 = field(&json, "mult").parse().unwrap();
    let alien_bytes = hex_to_bytes(field(&json, "alien_hex"));
    let members: Vec<u64> = (1..=n).map(|i| i.wrapping_mul(mult)).collect();
    let aliens: Vec<u64> = members.iter().map(|k| k.wrapping_add(1)).collect();
    let want_alien: Vec<bool> = (0..n as usize)
        .map(|i| alien_bytes[i / 8] >> (i % 8) & 1 == 1)
        .collect();
    // xor family: no FilterRef in the reference, but the struct fields are
    // public — build the owned filter directly from the Python-emitted
    // descriptor (seed u64 LE + block_length u64 LE, filters.py to_dma)
    fn check_xor<T, F2>(desc: &[u8], make: F2, fps_len: usize, members: &[u64],
                        aliens: &[u64], want_alien: &[bool]) -> Result<(), String>
    where
        T: Filter<u64>,
        F2: Fn(u64, usize) -> T,
    {
        let seed = u64::from_le_bytes(desc[..8].try_into().unwrap());
        let bl = u64::from_le_bytes(desc[8..16].try_into().unwrap()) as usize;
        if bl * 3 != fps_len {
            return Err(format!("block_length {bl} inconsistent with {fps_len} slots"));
        }
        let f = make(seed, bl);
        for (i, k) in members.iter().enumerate() {
            if !f.contains(k) {
                return Err(format!("false negative at member {i}"));
            }
        }
        for (i, k) in aliens.iter().enumerate() {
            if f.contains(k) != want_alien[i] {
                return Err(format!("alien bit {i} mismatch"));
            }
        }
        Ok(())
    }

    let res = match kind {
        "bfuse8" => check::<BinaryFuse8Ref>(&fps, &desc, &members, &aliens, &want_alien),
        "bfuse16" => check::<BinaryFuse16Ref>(&fps, &desc, &members, &aliens, &want_alien),
        "bfuse32" => check::<BinaryFuse32Ref>(&fps, &desc, &members, &aliens, &want_alien),
        "xor8" => check_xor(
            &desc,
            |seed, bl| Xor8 { seed, block_length: bl, fingerprints: fps.clone().into() },
            fps.len(), &members, &aliens, &want_alien),
        "xor16" => {
            let v: Vec<u16> = fps.chunks_exact(2)
                .map(|c| u16::from_le_bytes([c[0], c[1]])).collect();
            let n = v.len();
            check_xor(&desc,
                      |seed, bl| Xor16 { seed, block_length: bl, fingerprints: v.clone().into() },
                      n, &members, &aliens, &want_alien)
        }
        "xor32" => {
            let v: Vec<u32> = fps.chunks_exact(4)
                .map(|c| u32::from_le_bytes([c[0], c[1], c[2], c[3]])).collect();
            let n = v.len();
            check_xor(&desc,
                      |seed, bl| Xor32 { seed, block_length: bl, fingerprints: v.clone().into() },
                      n, &members, &aliens, &want_alien)
        }
        other => Err(format!("unknown kind {other}")),
    };
    match res {
        Ok(()) => println!("OK"),
        Err(e) => {
            println!("MISMATCH {kind}: {e}");
            std::process::exit(1);
        }
    }
}
