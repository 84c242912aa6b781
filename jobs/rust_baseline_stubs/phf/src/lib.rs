//! Linear-scan Map stub (the 129-entity table; the bench file contains
//! zero '&' so this map is never consulted during the measurement).
pub struct Map<K: 'static, V: 'static> { pub entries: &'static [(K, V)] }

impl Map<&'static [u8], &'static [u8]> {
    #[inline]
    pub fn get(&self, key: &[u8]) -> Option<&&'static [u8]> {
        self.entries.iter().find(|(k, _)| *k == key).map(|(_, v)| v)
    }
}

#[macro_export]
macro_rules! phf_map {
    ($($k:expr => $v:expr),* $(,)?) => {
        $crate::Map { entries: &[ $(($k, $v)),* ] }
    };
}
