//! kmp_find via glibc memmem (SIMD-assisted substring search).
use core::ffi::c_void;
extern "C" {
    fn memmem(h: *const c_void, hl: usize, n: *const c_void, nl: usize) -> *const c_void;
}

#[inline]
pub fn kmp_find(needle: &[u8], hay: &[u8]) -> Option<usize> {
    if needle.is_empty() { return Some(0); }
    unsafe {
        let p = memmem(hay.as_ptr() as *const c_void, hay.len(),
                       needle.as_ptr() as *const c_void, needle.len());
        if p.is_null() { None } else { Some(p as usize - hay.as_ptr() as usize) }
    }
}
